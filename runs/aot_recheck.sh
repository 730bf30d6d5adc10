#!/bin/bash
# Re-run the EDSR-full SRX1 on-chip check after the plan-precision fix
# (compose_conv_kernels / glue-plan einsums now Precision.HIGHEST): the
# first check failed at diff=3 because the DIRECT route's composed plan was
# built on-device at TPU default (bf16) precision while the artifact's plan
# was built on CPU (f32-exact).  Richer diagnostics this time.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
source tools/chiplock.sh
with_chip timeout 1800 python - > runs/aot_chip_check_edsr_full.out 2>&1 <<'PYEOF'
import numpy as np, jax, jax.numpy as jnp
from ml_super_resolution_tpu.aot import load_artifact
hdr, fn = load_artifact("runs/edsr_full_x4.srx")
print("header:", {k: hdr[k] for k in ("model", "scale", "batches", "step")})
x = (np.random.default_rng(0).random((1, 270, 480, 3)) * 255).astype(np.uint8)
out = np.asarray(fn(x))
print("on-chip artifact call ok:", out.shape, out.dtype,
      "backend:", jax.default_backend())
from ml_super_resolution_tpu.cli import _load_run
from ml_super_resolution_tpu.infer import upscale_frames
trainer, state, step, cfg = _load_run("runs/r4_edsr_full", best=True)
variables = {"params": trainer.eval_params(state)}
if getattr(state, "batch_stats", None):
    variables["batch_stats"] = state.batch_stats
ref = np.asarray(upscale_frames(trainer.model, variables, jnp.asarray(x),
                                "edsr", 4))
d = np.abs(out.astype(int) - ref.astype(int))
print("max |artifact - direct| =", int(d.max()), "uint8 steps;",
      "mean", float(d.mean()), "; frac>0", float((d > 0).mean()),
      "; frac>1", float((d > 1).mean()))
assert int(d.max()) <= 1, int(d.max())
print("AOT CHIP CHECK PASS (edsr-full)")
PYEOF
rc=$?
echo "recheck rc=$rc"
tail -3 runs/aot_chip_check_edsr_full.out
