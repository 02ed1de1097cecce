"""Unit tests for the fixed-shape minibatch helper and deferred metrics.

``_run_minibatched`` is the compile-reuse mechanism for every per-keyframe
pass-2 stage (pipeline.py): rows must come back exactly as if the program
had run over the full batch, for any batch size vs minibatch size, including
pytree outputs. ``Metrics.count_async`` is the deferred-readback counter
path every stage's metrics now go through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meatmodeler_tpu.pipeline import _run_minibatched
from meatmodeler_tpu.utils.profiling import Metrics


@pytest.mark.parametrize("n", [1, 3, 8, 9, 16, 19])
def test_run_minibatched_matches_full_batch(n):
    @jax.jit
    def run(a, b):
        return {"s": a + b, "m": jnp.max(b, axis=-1)}

    a = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    b = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4) * 0.5
    out = _run_minibatched(run, 8, a, b)
    full = run(a, b)
    np.testing.assert_array_equal(np.asarray(out["s"]), np.asarray(full["s"]))
    np.testing.assert_array_equal(np.asarray(out["m"]), np.asarray(full["m"]))
    assert out["s"].shape[0] == n


def test_run_minibatched_tuple_output_and_padding_isolation():
    # The padded tail repeats the LAST row; results for real rows must not
    # depend on it (rows are independent maps by contract).
    @jax.jit
    def run(x):
        return x * 2.0, jnp.sum(x, axis=-1)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    doubled, sums = _run_minibatched(run, 4, x)
    np.testing.assert_allclose(np.asarray(doubled), np.asarray(x) * 2.0)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(x).sum(-1), rtol=1e-6)


def test_count_async_defers_and_flushes():
    m = Metrics()
    m.count_async("scalar", jnp.float32(2.5), convert=float)
    m.count_async("vec", jnp.arange(3), convert=lambda v: [int(x) for x in v])
    m.count_async("auto_scalar", jnp.int32(7))
    m.count_async("auto_vec", jnp.asarray([1.0, 2.0]))
    # Nothing materialized yet.
    assert "scalar" not in m.counters
    d = m.as_dict()
    assert d["counters"]["scalar"] == 2.5
    assert d["counters"]["vec"] == [0, 1, 2]
    assert d["counters"]["auto_scalar"] == 7
    assert d["counters"]["auto_vec"] == [1.0, 2.0]
    # Flush is idempotent and count() still overrides.
    m.flush()
    m.count("scalar", 9.0)
    assert m.as_dict()["counters"]["scalar"] == 9.0


def test_count_async_latest_value_wins():
    m = Metrics()
    m.count_async("x", jnp.float32(1.0), convert=float)
    m.count_async("x", jnp.float32(2.0), convert=float)
    assert m.as_dict()["counters"]["x"] == 2.0
