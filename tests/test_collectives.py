"""Collectives facade tests on the 8-virtual-device CPU mesh (P3)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ml_super_resolution_tpu.parallel import collectives as coll
from ml_super_resolution_tpu.parallel.mesh import make_mesh


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def test_psum_and_pmean():
    mesh = make_mesh(dp=8, sp=1)
    x = jnp.arange(8.0)

    def body(v):
        return coll.psum(v, "data"), coll.pmean(v, "data")

    s, m = _shard_map(body, mesh, P("data"), (P("data"), P("data")))(x)
    np.testing.assert_allclose(np.asarray(s), np.full(8, 28.0))
    np.testing.assert_allclose(np.asarray(m), np.full(8, 3.5))


def test_ppermute_shift_zero_fill_and_wrap():
    mesh = make_mesh(dp=8, sp=1)
    x = jnp.arange(8.0).reshape(8, 1)

    def shift_fn(wrap):
        def body(v):
            return coll.ppermute_shift(v, "data", 1, wrap=wrap)

        return _shard_map(body, mesh, P("data"), P("data"))

    no_wrap = np.asarray(shift_fn(False)(x)).ravel()
    np.testing.assert_allclose(no_wrap, [0, 0, 1, 2, 3, 4, 5, 6])
    wrapped = np.asarray(shift_fn(True)(x)).ravel()
    np.testing.assert_allclose(wrapped, [7, 0, 1, 2, 3, 4, 5, 6])


def test_all_gather_assembles_tiles():
    mesh = make_mesh(dp=1, sp=8)
    x = jnp.arange(16.0).reshape(8, 2)

    def body(v):
        return coll.all_gather(v, "space", axis=0, tiled=True)

    out = _shard_map(body, mesh, P("space", None), P(None, None))(x)
    np.testing.assert_allclose(np.asarray(out), np.arange(16.0).reshape(8, 2))
