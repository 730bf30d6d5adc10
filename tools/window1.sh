#!/bin/bash
# Chip window 1: probes + quick measurements between training queues.
# Run ONLY with no other TPU process alive.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p runs

# chip health first: tiny op under timeout (a wedged chip hangs here)
timeout 50 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || exit 1

timeout 560 python tools/chip_probes.py vmem mosaic 2>&1
timeout 50 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || exit 1
timeout 560 python tools/chip_probes.py xlabf16 2>&1
timeout 50 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || exit 1
timeout 560 python tools/chip_probes.py fused2 2>&1
timeout 50 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || exit 1
timeout 560 python tools/chip_probes.py kapply 2>&1
timeout 50 python -c "import jax, jax.numpy as jnp; print('chip ok', float(jnp.sum(jnp.ones((8,128)))))" || exit 1
echo "WINDOW1 DONE"
