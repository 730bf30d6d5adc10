"""Multi-host / DCN entry point (SURVEY §5.8).

Only the single-process case is testable here (one chip via a relay; CPU
mesh in tests); the multi-process path follows the standard JAX
multi-controller contract and is exercised structurally.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ml_super_resolution_tpu.parallel.distributed import (
    make_multihost_mesh,
    maybe_initialize,
)
from ml_super_resolution_tpu.train.trainer import put_batch


def test_maybe_initialize_noop():
    assert maybe_initialize("") is False
    assert maybe_initialize("", 4, 0) is False
    # jax still single-process afterwards
    assert jax.process_count() == 1


def test_multihost_mesh_single_process_shape():
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.shape["dcn"] == 1
    assert mesh.shape["data"] == len(jax.devices())


def test_put_batch_single_process_equals_device_put():
    mesh = make_multihost_mesh()
    sharding = NamedSharding(mesh, P(("dcn", "data")))
    batch = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
    a = put_batch(sharding, batch)
    b = jax.device_put(batch, sharding)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding == b.sharding


def test_dcn_data_sharded_step_runs():
    """A jitted step over the (dcn, data) mesh compiles and executes —
    the single-process degenerate case of the multi-host path."""
    mesh = make_multihost_mesh()
    sharding = NamedSharding(mesh, P(("dcn", "data")))

    @jax.jit
    def step(x):
        return (x.astype(jax.numpy.float32) ** 2).mean()

    batch = np.ones((16, 8, 8, 3), np.uint8)
    out = step(put_batch(sharding, batch))
    assert float(out) == 1.0
