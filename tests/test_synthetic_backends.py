"""NumPy vs JAX renderer parity (io/synthetic.py).

bench.py renders the benchmark clip with backend="jax" while the test suite
renders with NumPy; this guards the two implementations against silent
divergence of scene constants or shading."""

import dataclasses

import numpy as np

from meatmodeler_tpu.io.synthetic import TurntableScene, render_sequence


def test_backends_render_identical_scenes():
    scene = dataclasses.replace(TurntableScene(image_size=(192, 144)), noise_sigma=0.0)
    f_np, p_np, c_np = render_sequence(scene, 3, seed=0)
    f_jx, p_jx, c_jx = render_sequence(scene, 3, seed=0, backend="jax")
    np.testing.assert_array_equal(p_np, p_jx)
    np.testing.assert_array_equal(c_np, c_jx)
    diff = np.abs(f_np.astype(int) - f_jx.astype(int))
    # f32 vs f64 rounding may flip the odd LSB; anything more is divergence.
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
