"""Golden tests for the int8 PTQ inference path (quant.py).

Three gates per model:
1. **Structure mirror**: the calibration engine's f32 pass must equal the
   flax ``model.apply`` (folded-tail recast for EDSR/SRResNet is exact, so
   allclose at 1e-5) — proves the quantized path runs the same network.
2. **Fidelity**: int8 output >= 40 dB SNR against the f32 reference.
3. **Executor equivalence**: the "conv" and "dot" executors are exact
   integer programs over identical quantized operands — bitwise equal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_super_resolution_tpu.models import SRCNN, ESPCN, VDSR, EDSR, SRResNet
from ml_super_resolution_tpu.quant import (
    _CalibEngine,
    _NETS,
    int8_apply_fn,
    int8_output_fidelity_db,
    quantize_weight,
)

CASES = [
    ("srcnn", SRCNN(channels=1), (1, 16, 16, 1), 1),
    ("espcn", ESPCN(scale=2, channels=1), (1, 12, 12, 1), 2),
    ("vdsr", VDSR(channels=1, depth=6, features=16), (1, 16, 16, 1), 1),
    ("edsr", EDSR(scale=2, channels=3, features=16, num_blocks=2,
                  res_scale=0.1), (1, 12, 12, 3), 2),
    ("srresnet", SRResNet(scale=4, channels=3, features=16, num_blocks=2),
     (1, 8, 8, 3), 4),
]


def _setup(model, shape):
    x = jax.random.uniform(jax.random.PRNGKey(1), shape)
    variables = model.init(jax.random.PRNGKey(0), x)
    return x, variables


@pytest.mark.parametrize("name,model,shape,scale", CASES,
                         ids=[c[0] for c in CASES])
def test_calib_pass_matches_flax_apply(name, model, shape, scale):
    x, variables = _setup(model, shape)
    y_ref = model.apply(variables, x, train=False)
    eng = _CalibEngine()
    y_cal = _NETS[name](eng, variables["params"],
                        variables.get("batch_stats", {}), x, scale,
                        float(getattr(model, "res_scale", 1.0)))
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name,model,shape,scale", CASES,
                         ids=[c[0] for c in CASES])
def test_int8_fidelity_and_executor_equivalence(name, model, shape, scale):
    x, variables = _setup(model, shape)
    y_ref = model.apply(variables, x, train=False)
    y_conv = int8_apply_fn(model, variables, name, scale, x, impl="conv")(x)
    y_dot = int8_apply_fn(model, variables, name, scale, x, impl="dot")(x)
    fid = int8_output_fidelity_db(y_ref, y_conv)
    assert fid >= 40.0, f"{name}: int8 fidelity {fid:.1f} dB < 40 dB"
    # both executors compute the identical integer program -> bitwise equal
    np.testing.assert_array_equal(np.asarray(y_conv), np.asarray(y_dot))


def test_quantize_weight_roundtrip_bound():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * jnp.arange(
        1, 17)  # per-channel magnitudes differ by 16x
    wq, sw = quantize_weight(w)
    assert wq.dtype == jnp.int8 and sw.shape == (16,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(sw) - np.asarray(w))
    # symmetric rounding: per-channel error <= s_w / 2
    assert (err <= np.asarray(sw) / 2 + 1e-7).all()


def test_zero_weight_channel_is_exact():
    w = jnp.zeros((3, 3, 4, 4)).at[..., :2].set(
        jax.random.normal(jax.random.PRNGKey(3), (3, 3, 4, 2)))
    wq, sw = quantize_weight(w)
    assert (np.asarray(wq[..., 2:]) == 0).all()
    assert np.isfinite(np.asarray(sw)).all()


def test_int8_unsupported_model_raises():
    with pytest.raises(ValueError, match="no int8 path"):
        int8_apply_fn(None, {"params": {}}, "nope", 2,
                      jnp.zeros((1, 4, 4, 1)))


def test_batch_generalization():
    """Calibrate on one frame, run on a different 2-frame batch: scales are
    static, shapes retrace, numerics stay within the fidelity gate."""
    name, model, shape, scale = CASES[1]  # espcn
    x, variables = _setup(model, shape)
    fn = int8_apply_fn(model, variables, name, scale, x)
    x2 = jax.random.uniform(jax.random.PRNGKey(7), (2,) + shape[1:])
    y_ref = model.apply(variables, x2, train=False)
    fid = int8_output_fidelity_db(y_ref, fn(x2))
    assert fid >= 40.0, f"batch fidelity {fid:.1f} dB"


def test_percentile_calibration_changes_scales():
    """percentile<100 must tighten (or keep) every activation scale, and
    the quantized forward still meets the fidelity gate at p99.9."""
    name, model, shape, scale = CASES[1]  # espcn
    x, variables = _setup(model, shape)
    eng_max = _CalibEngine()
    _NETS[name](eng_max, variables["params"], {}, x, scale, 1.0)
    eng_pct = _CalibEngine(percentile=99.0)
    _NETS[name](eng_pct, variables["params"], {}, x, scale, 1.0)
    assert all(p <= m + 1e-12 for p, m in zip(eng_pct.sx, eng_max.sx))
    assert any(p < m for p, m in zip(eng_pct.sx, eng_max.sx))
    y_ref = model.apply(variables, x, train=False)
    yq = int8_apply_fn(model, variables, name, scale, x, percentile=99.9)(x)
    assert int8_output_fidelity_db(y_ref, yq) >= 40.0


def test_qat_params_quantizes_only_conv_kernels():
    from ml_super_resolution_tpu.quant import qat_params

    name, model, shape, scale = CASES[3]  # edsr (has biases + kernels)
    x, variables = _setup(model, shape)
    q = qat_params(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    qleaves = dict(jax.tree_util.tree_leaves_with_path(q))
    changed = unchanged = 0
    for path, leaf in leaves:
        ql = qleaves[path]
        if getattr(path[-1], "key", None) == "kernel" and leaf.ndim == 4:
            amax = np.abs(np.asarray(leaf)).max(axis=(0, 1, 2))
            err = np.abs(np.asarray(ql) - np.asarray(leaf))
            assert (err <= amax / 254 + 1e-7).all()  # <= s/2 per channel
            changed += 1
        else:
            np.testing.assert_array_equal(np.asarray(ql), np.asarray(leaf))
            unchanged += 1
    assert changed > 0 and unchanged > 0


def test_qat_forward_has_gradients():
    """STE: the fake-quantized forward must carry nonzero, finite grads."""
    from ml_super_resolution_tpu.quant import qat_intercept, qat_params

    name, model, shape, scale = CASES[1]  # espcn
    x, variables = _setup(model, shape)

    def loss(p):
        with qat_intercept():
            out = model.apply({"params": qat_params(p)}, x, train=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_qat_cli_training_smoke(tmp_path, capsys):
    from ml_super_resolution_tpu.cli import main

    wd = tmp_path / "run"
    rc = main([
        "train", "--model", "espcn", "--scale", "2", "--qat",
        "--workdir", str(wd), "--steps", "4", "--batch-size", "4",
        "--patch-size", "32", "--dp", "1",
        "--ckpt-every", "4", "--eval-every", "4", "--log-every", "2",
    ])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 3 < out["final_eval"]["psnr"] < 60
